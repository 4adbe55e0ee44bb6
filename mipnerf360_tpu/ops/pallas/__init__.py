from .composite import composite_weights
from .resample import resample_tpu
