from fpv4d.core import rotations, transforms, dct
