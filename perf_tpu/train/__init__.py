from .sup_pool import SupInfoPool, PanoSupInfo, build_pano_sup_info
from .schedule import OptimConfig, lr_at, smooth_l1, cosine_two_phase_lr
from .scene import (Scene, NeRFScene, TrainConfig,
                    pano_visibility_from_distance)
from .prop_scene import PropNeRFScene
from .checkpoint import save_checkpoint, load_checkpoint
