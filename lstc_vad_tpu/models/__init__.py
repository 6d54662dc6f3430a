from .encoder import Encoder, EncoderLayer, FeedForward, MultiHeadAttention  # noqa: F401
from .heads import Classifier, Regressor, make_head  # noqa: F401
from . import rpe  # noqa: F401
