from . import layers
from .resnet import ResNet, Bottleneck, resnet50, resnet101, build_backbone
from .deeplab_v2 import DeepLabV2, ASPPClassifier
from .pspnet import PSPNet, PSPModule, UpsampleDecoder
