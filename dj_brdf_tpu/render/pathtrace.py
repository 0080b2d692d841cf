"""A small differentiable path tracer.

The reference delegates light transport to Mitsuba's integrators and
only supplies BSDF plugins (mitsuba/*.cpp); the TPU-native equivalent
is this renderer: a sphere-on-ground-plane scene ("matpreview" style)
path-traced entirely inside one jitted program — fixed bounce count
via ``lax.scan``, per-pixel counter-based RNG, next-event estimation
for a directional (delta) light plus a constant sky, and any two
framework materials (sphere + floor) with their own importance
samplers. Differentiable end-to-end w.r.t. material parameters and
light direction; pixels/samples shard over the mesh data axis like
any other batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dj_brdf_tpu.core.math import dot, normalize, vec3
from dj_brdf_tpu.render.sphere import _build_frame

_EPS = 1e-3


def world_to_local(n, v):
    t, b = _build_frame(n)
    return vec3(dot(v, t), dot(v, b), dot(v, n))


def local_to_world(n, v):
    t, b = _build_frame(n)
    return (v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n)


def _intersect(ro, rd):
    """Unit sphere at origin + ground plane z = -1.
    Returns (hit, t, n_world, is_sphere)."""
    # sphere |ro + t rd|^2 = 1
    b = dot(ro, rd)
    c = dot(ro, ro) - 1.0
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_s = jnp.where(disc > 0.0, -b - sq, jnp.inf)
    t_s = jnp.where(t_s > _EPS, t_s, jnp.inf)

    # plane z = -1
    dz = rd[..., 2]
    t_p = (-1.0 - ro[..., 2]) / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    t_p = jnp.where((t_p > _EPS) & (jnp.abs(dz) > 1e-9), t_p, jnp.inf)

    is_sphere = t_s < t_p
    t = jnp.minimum(t_s, t_p)
    hit = jnp.isfinite(t)
    pos = ro + t[..., None] * rd
    n_sphere = normalize(pos, eps=1e-12)
    n_plane = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], ro.dtype),
                               ro.shape)
    n = jnp.where(is_sphere[..., None], n_sphere, n_plane)
    return hit, t, n, is_sphere


def _occluded(pos, dir_w):
    hit, _, _, _ = _intersect(pos, dir_w)
    return hit


def _material_eval(mats, is_sphere, fn_name, *args):
    """Static two-way material dispatch: evaluate both, select."""
    a = getattr(mats[0], fn_name)(*args)
    b = getattr(mats[1], fn_name)(*args)
    def sel(x, y):
        mask = is_sphere
        while mask.ndim < x.ndim:
            mask = mask[..., None]
        return jnp.where(mask, x, y)
    return jax.tree_util.tree_map(sel, a, b)


@partial(jax.jit, static_argnames=("res", "spp", "max_bounces", "mesh"))
def render(sphere_mat, floor_mat, light_dir, light_radiance, sky_radiance,
           res: int = 256, spp: int = 8, max_bounces: int = 3,
           key=None, mesh=None):
    """Path-trace the scene. Returns an (res, res, 3) HDR image.

    ``sphere_mat``/``floor_mat``: any material with evalp/evalp_is in
    the local frame (see render.materials). ``light_dir`` points
    *toward* the light (a delta directional light). With ``mesh``, the
    ray batch is sharding-constrained over the mesh's data axis so XLA
    partitions the whole per-ray pipeline across devices (materials
    replicate; the device count should divide res*res*spp)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    light_dir = normalize(jnp.asarray(light_dir, jnp.float32))
    light_rad = jnp.asarray(light_radiance, jnp.float32)
    sky_rad = jnp.asarray(sky_radiance, jnp.float32)
    mats = (sphere_mat, floor_mat)

    # pinhole camera looking -y at the sphere
    cam_pos = jnp.asarray([0.0, 3.2, 0.6], jnp.float32)
    look = normalize(-cam_pos + jnp.asarray([0.0, 0.0, 0.0]))
    right = normalize(jnp.cross(look, jnp.asarray([0.0, 0.0, 1.0])))
    up = jnp.cross(right, look)

    xs = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * 2.0 - 1.0
    px, py = jnp.meshgrid(xs, -xs)
    n_rays = res * res * spp
    px = jnp.tile(px.reshape(-1), spp)
    py = jnp.tile(py.reshape(-1), spp)
    fov_scale = 0.62
    rd = normalize(look + fov_scale * (px[..., None] * right
                                       + py[..., None] * up))
    ro = jnp.broadcast_to(cam_pos, rd.shape)

    u = jax.random.uniform(key, (max_bounces, n_rays, 2))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dj_brdf_tpu.parallel.mesh import DATA_AXIS
        ray_s = NamedSharding(mesh, P(DATA_AXIS))
        ro = jax.lax.with_sharding_constraint(ro, ray_s)
        rd = jax.lax.with_sharding_constraint(rd, ray_s)
        u = jax.lax.with_sharding_constraint(
            u, NamedSharding(mesh, P(None, DATA_AXIS)))

    def bounce(carry, u_b):
        ro, rd, throughput, radiance, alive = carry
        hit, t, n, is_sphere = _intersect(ro, rd)

        # miss -> sky
        radiance = radiance + jnp.where(
            (alive & ~hit)[..., None], throughput * sky_rad, 0.0)
        alive = alive & hit

        pos = ro + t[..., None] * rd
        o_loc = world_to_local(n, -rd)

        # next-event estimation toward the delta light
        i_loc = world_to_local(n, jnp.broadcast_to(light_dir, rd.shape))
        shadow_o = pos + n * _EPS * 3.0
        lit = ~_occluded(shadow_o, jnp.broadcast_to(light_dir, rd.shape))
        f = _material_eval(mats, is_sphere, "evalp", i_loc, o_loc)
        contrib = throughput * light_rad * f
        ok = alive & lit & (i_loc[..., 2] > 0.0) & (o_loc[..., 2] > 0.0)
        radiance = radiance + jnp.where(ok[..., None], contrib, 0.0)

        # BSDF sample for the next segment
        w, i_s, pdf = _material_eval(mats, is_sphere, "evalp_is",
                                     u_b[:, 0], u_b[:, 1], o_loc)
        throughput = throughput * jnp.where(alive[..., None], w, 1.0)
        alive = alive & (pdf > 0.0) & (i_s[..., 2] > 0.0)
        rd_new = normalize(local_to_world(n, i_s), eps=1e-12)
        ro_new = pos + n * _EPS * 3.0
        ro = jnp.where(alive[..., None], ro_new, ro)
        rd = jnp.where(alive[..., None], rd_new, rd)
        return (ro, rd, throughput, radiance, alive), None

    init = (ro, rd, jnp.ones_like(rd), jnp.zeros_like(rd),
            jnp.ones(n_rays, bool))
    (ro, rd, throughput, radiance, alive), _ = jax.lax.scan(bounce, init, u)
    # terminate remaining paths into the sky
    hit, _, _, _ = _intersect(ro, rd)
    radiance = radiance + jnp.where((alive & ~hit)[..., None],
                                    throughput * sky_rad, 0.0)

    img = radiance.reshape(spp, res, res, 3).mean(axis=0)
    return img
