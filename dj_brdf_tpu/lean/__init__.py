from dj_brdf_tpu.lean.lrep import Lrep, params_to_lrep, lrep_to_params
from dj_brdf_tpu.lean import maps
from dj_brdf_tpu.lean.filtered import filtered_params, FilteredBeckmannMaterial
