from .rays import Rays, BoundedRays, cat_rays
from .camera import (
    apply_rot, apply_rot_trans, apply_transform, normalize, look_at,
    img_coord_from_hw, img_to_pano_coord, pano_to_img_coord,
    pano_coord_to_direction, direction_to_pano_coord,
    direction_to_img_coord, img_coord_to_pano_direction,
    img_coord_to_sample_coord, cam_rays_cam_space,
    direction_to_pers_img_coord, gen_pano_rays, gen_pers_rays,
    get_panorama_sphere_points, ang2vec, get_rand_horizontal_points,
    pers_depth_to_normal,
)
from .resample import bilinear_sample, pano_sample, sample_views, scatter_accum
from .tangent import icosahedron, tangent_cameras, tangent_c2w
from .morphology import (
    ellipse_kernel, dilation, erosion, laplacian3, edge_keep_mask,
    binary_open_close, align_scale,
)
