from .mlp import (
    ngp_mlp_init, ngp_mlp_apply, vanilla_mlp_init, vanilla_mlp_apply,
)
from .ngp import (
    trunc_exp, NGPFieldConfig, NGPDensityFieldConfig,
    init_ngp_params, init_geo_params, init_app_params, reset_geo,
    query_density, query_rgb, query_rgb_density,
    query_density_coords, query_rgb_coords, query_density_ray, query_rgb_ray,
    init_density_field, query_density_field,
)
from .sphere_field import (
    SphereFieldConfig, init_sphere_field, sphere_field_distance,
    sphere_field_distance_and_grad, grads_to_normal,
)
