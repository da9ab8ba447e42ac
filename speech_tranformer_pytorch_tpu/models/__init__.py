from .modules import (Conv2dSubsampling, FeedForward, MultiHeadAttention,
                      PositionalEncoding, subsampled_lengths)
from .encoder import Encoder
from .decoder import Decoder
from .transformer import SpeechTransformer
