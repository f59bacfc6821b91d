from .occgrid import (
    world_to_voxel, voxel_to_flat, occ_grid_from_points, occ_grid_points,
    occ_lookup, ema_update_from_density,
)
from .renderer import RenderConfig, march_rays, render_rays, render_image
from ..kernels.distortion import distortion_loss, distortion_loss_bruteforce
from .prop import PropRenderConfig, render_rays_prop, prop_loss
