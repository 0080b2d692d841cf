from dj_brdf_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from dj_brdf_tpu.utils.profiling import trace, Throughput
