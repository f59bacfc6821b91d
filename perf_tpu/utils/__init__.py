from .metrics import MetricsWriter, phase_timer, profiler_trace
from .synthetic import (
    cube_room_hit, cube_room_color, render_cube_room_pano, psnr,
)
from .debug import printarr
from .io import (
    read_image, write_image, write_video, colorize_single_channel_image,
    read_dpt, write_ply,
)
