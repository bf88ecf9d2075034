from .fft import forward, inverse  # noqa: F401
from .poisson import solve_poisson  # noqa: F401
