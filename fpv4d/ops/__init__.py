from fpv4d.ops import chamfer_ref, chamfer_pallas, contact, losses
from fpv4d.ops.chamfer_pallas import nn_distance
