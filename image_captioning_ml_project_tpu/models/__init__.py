from .captioning_model import ImageCaptioningModel, QFormer
from .encoders import build_encoder
from .decoders import build_decoder
from .attention import build_attention
