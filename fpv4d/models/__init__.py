from fpv4d.models import params, smplx, vposer, motion_gru, cvae
