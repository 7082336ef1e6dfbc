from .bisenet import BiSeNet
from .deeplabv2 import DeepLabV2
from .discriminator import FCDiscriminator
from .factory import build_model, build_discriminator, init_model
from .quantize import calibrate, quantized_model
