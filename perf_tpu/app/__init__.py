from .runner import CoreRunner, build_prior_backends, build_inpainter
