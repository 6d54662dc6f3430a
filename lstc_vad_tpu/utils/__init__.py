from .logging import get_logger, log_config  # noqa: F401
from .seeding import set_seeds  # noqa: F401
