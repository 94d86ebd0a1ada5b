from fpv4d.parallel import sharding, multi_clip
