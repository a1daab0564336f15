from . import io  # noqa: F401
from . import config  # noqa: F401
