from dj_brdf_tpu.fit import tabular, moments
