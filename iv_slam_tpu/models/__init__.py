from .introspection import (  # noqa: F401
    C1DeepSup,
    IntrospectionNet,
    inference_cost_map,
    normalize_image,
)
from .mobilenet import MobileNetV2Dilated  # noqa: F401
from .zoo import (  # noqa: F401
    ENCODER_FC_DIM,
    HRNetV2,
    ResNetEncoder,
    SegmentationModel,
    UPerNet,
    build_decoder,
    build_encoder,
)
