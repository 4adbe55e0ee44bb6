from .composite import composite_weights
