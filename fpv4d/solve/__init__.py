from fpv4d.solve import clip_solve, frame_fit, keypoint_fit
