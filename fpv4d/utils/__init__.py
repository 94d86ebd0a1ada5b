from fpv4d.utils import monitor, observability, checkpoint
