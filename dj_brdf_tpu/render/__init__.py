from dj_brdf_tpu.render.envmap import EnvMap
from dj_brdf_tpu.render.sphere import render_sphere, sphere_normals
