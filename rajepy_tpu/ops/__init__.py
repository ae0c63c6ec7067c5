"""Pure-JAX computational kernels."""
from . import astronomy, gaunt, geometry, hyp2f1, physics, radtrans, rrls, \
    voigt  # noqa: F401
