from fpv4d.io import colmap, keypoints, ply, body_pkl, video
