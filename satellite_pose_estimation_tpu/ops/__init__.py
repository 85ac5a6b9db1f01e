from .precision import highest_precision
