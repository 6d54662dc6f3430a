from .generator import (  # noqa: F401
    generate_ltn_pseudo_labels,
    generate_stn_pseudo_labels,
    save_pseudo_labels,
)
from .coteach import CoTeachingDriver  # noqa: F401
