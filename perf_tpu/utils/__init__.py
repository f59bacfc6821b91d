from .metrics import MetricsWriter, phase_timer, profiler_trace
from .synthetic import (
    cube_room_hit, cube_room_color, render_cube_room_pano, psnr,
)
