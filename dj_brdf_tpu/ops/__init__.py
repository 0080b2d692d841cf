from dj_brdf_tpu.ops import soa
