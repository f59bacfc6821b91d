from .interface import DepthPredictor, NormalPredictor
from .fake import FakeCubeRoomDepthPredictor, FakeCubeRoomNormalPredictor
from .pano_joint import PanoJointPredictor, JointPredictorConfig
from .pano_fusion import (
    PanoFusionInvPredictor, PanoFusionNormalPredictor, PanoFusionConfig,
)
from .pano_refiner import PanoGeoRefiner, RefinerConfig
