from .ics import build_ics  # noqa: F401
from .sampling import sample_quantum_perturbation  # noqa: F401
