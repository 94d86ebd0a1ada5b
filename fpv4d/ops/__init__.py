from fpv4d.ops import (chamfer_ref, chamfer_pallas, cand_pallas,
                       contact, losses, nn, sdf)
from fpv4d.ops.nn import nn_distance  # unified dispatcher (grid/pallas/xla)
