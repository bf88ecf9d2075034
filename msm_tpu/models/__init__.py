from .ics import build_ics  # noqa: F401
from .sampling import sample_quantum_perturbation  # noqa: F401
from . import fock  # noqa: F401
from . import quantum  # noqa: F401
