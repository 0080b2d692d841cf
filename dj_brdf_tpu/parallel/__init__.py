from dj_brdf_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from dj_brdf_tpu.parallel import integrals
