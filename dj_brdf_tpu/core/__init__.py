from dj_brdf_tpu.core import math, special, spline
from dj_brdf_tpu.core.pytree import pytree_dataclass, static_field
