from .fft import forward, inverse  # noqa: F401
