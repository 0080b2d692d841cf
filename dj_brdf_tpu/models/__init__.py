from dj_brdf_tpu.models.lambert import Lambert
from dj_brdf_tpu.models.merl import Merl
from dj_brdf_tpu.models.utia import Utia
from dj_brdf_tpu.models.sgd import SGD
from dj_brdf_tpu.models.abc_model import ABC
