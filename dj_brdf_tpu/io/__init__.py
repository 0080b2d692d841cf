from dj_brdf_tpu.io.merl_io import load_merl, save_merl
from dj_brdf_tpu.io.utia_io import load_utia, save_utia
