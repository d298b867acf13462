"""Stage-level timing of the deform/MLP chain on TPU (train-shaped cloud).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_deform.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def qt(fn, *args, n: int = 20):
    v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t0 = time.time()
    for _ in range(n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t1 = time.time()
    for _ in range(2 * n):
        v = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).sum(), v)
    t2 = time.time()
    return max((t2 - t1) - (t1 - t0), 1e-9) / n


def main():
    from moss_tpu.data.synthetic import make_scene, make_frames
    from moss_tpu.models import lbs_field, pose_refine
    from moss_tpu.models.deform import coarse_deform_c2source
    from moss_tpu.ops.knn import knn
    from moss_tpu.ops.sh import sh_to_color
    from moss_tpu.ops.projection import preprocess
    from moss_tpu.ops import transforms as tf

    N = 46080
    scene = make_scene(n_verts=6890)
    frames, _ = make_frames(scene, n_frames=1, H=512, W=512, crop=512)
    fr = frames[0]
    rng = np.random.default_rng(0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    mlps = {"pose": pose_refine.init(k1), "lbs": lbs_field.init(k2)}
    verts = np.asarray(scene.big_pose_vertices)
    reps = -(-N // verts.shape[0])
    pts = jnp.asarray(
        (np.tile(verts, (reps, 1))[:N]
         + rng.normal(0, 0.01, (N, 3))).astype(np.float32))

    def stages():
        out = {}

        def knn_only(p):
            return knn(p, scene.big_pose_vertices, k=1)[1].sum()

        out["knn k=1 fwd"] = (knn_only, (pts,))

        _, ids = knn(pts, scene.big_pose_vertices, k=1)
        vert_ids = ids[:, 0]

        def deform_cached(p, mlp):
            pose = pose_refine.apply(mlp["pose"], fr.smpl_params["poses"])
            delta = lbs_field.apply(mlp["lbs"], p, pose["Rs"])
            o = coarse_deform_c2source(
                scene.smpl, p, fr.smpl_params, scene.big_pose_params,
                scene.big_pose_vertices, lbs_weight_delta=delta,
                correct_Rs=pose["Rs"], vert_ids=vert_ids)
            return jnp.sum(o.world_pts) + jnp.sum(o.transforms) + jnp.sum(o.translation)

        def deform_full(p, mlp):
            pose = pose_refine.apply(mlp["pose"], fr.smpl_params["poses"])
            delta = lbs_field.apply(mlp["lbs"], p, pose["Rs"])
            o = coarse_deform_c2source(
                scene.smpl, p, fr.smpl_params, scene.big_pose_params,
                scene.big_pose_vertices, lbs_weight_delta=delta,
                correct_Rs=pose["Rs"])
            return jnp.sum(o.world_pts) + jnp.sum(o.transforms) + jnp.sum(o.translation)

        out["deform(cached ids) fwd"] = (deform_cached, (pts, mlps))
        out["deform(cached ids) f+b"] = (
            lambda p, m: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(
                jax.grad(deform_cached, argnums=(0, 1))(p, m))), (pts, mlps))
        out["deform(full knn) fwd"] = (deform_full, (pts, mlps))
        out["deform(full knn) f+b"] = (
            lambda p, m: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(
                jax.grad(deform_full, argnums=(0, 1))(p, m))), (pts, mlps))

        Rs = pose_refine.apply(mlps["pose"], fr.smpl_params["poses"])["Rs"]

        def lbs_only(p, mlp):
            return jnp.sum(lbs_field.apply(mlp["lbs"], p, Rs))

        out["lbs_field fwd"] = (lbs_only, (pts, mlps))
        out["lbs_field f+b"] = (
            lambda p, m: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(
                jax.grad(lbs_only, argnums=(0, 1))(p, m))), (pts, mlps))

        def pose_only(mlp):
            return jnp.sum(pose_refine.apply(mlp["pose"], fr.smpl_params["poses"])["Rs"])

        out["pose_refine fwd"] = (pose_only, (mlps,))
        out["pose_refine f+b"] = (
            lambda m: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(
                jax.grad(pose_only)(m))), (mlps,))

        feats = jnp.asarray(rng.normal(0, 0.1, (N, 16, 3)).astype(np.float32))

        def sh_only(f, p):
            return jnp.sum(sh_to_color(3, f, p, fr.camera.cam_center))

        out["sh deg3 fwd"] = (sh_only, (feats, pts))
        out["sh deg3 f+b"] = (
            lambda f, p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(
                jax.grad(sh_only, argnums=(0, 1))(f, p))), (feats, pts))

        cov3d = tf.build_covariance(
            jnp.asarray(rng.uniform(0.004, 0.012, (N, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)))
        color = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
        opac = jnp.asarray(rng.uniform(0.3, 0.95, N).astype(np.float32))

        def pre_only(p):
            pr = preprocess(p, cov3d, color, opac, fr.camera)
            return jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.depth)

        out["preprocess fwd"] = (pre_only, (pts,))
        out["preprocess f+b"] = (
            lambda p: jnp.sum(jnp.abs(jax.grad(pre_only)(p))), (pts,))
        return out

    for name, (fn, args) in stages().items():
        dt = qt(jax.jit(fn), *args)
        print(f"{name:26s} {dt*1e3:8.3f} ms")


def main2():
    """get_covariance + transform fold + activations (the missing mass)."""
    from moss_tpu.models import gaussians as G
    from moss_tpu.ops import transforms as tf

    N = 46080
    rng = np.random.default_rng(0)
    scaling = jnp.asarray(rng.normal(-4, 0.3, (N, 3)).astype(np.float32))
    rotation = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    T = jnp.asarray(rng.normal(size=(N, 3, 3)).astype(np.float32) * 0.1
                    + np.eye(3, dtype=np.float32))

    def cov_nofold(s, q):
        return jnp.sum(tf.build_covariance(jnp.exp(s), q))

    def cov_fold(s, q, t):
        c = tf.build_covariance(jnp.exp(s), q)
        S = tf.unpack_cov3d(c)
        Sf = t @ S @ jnp.swapaxes(t, -1, -2)
        return jnp.sum(Sf)

    probes = {
        "build_cov fwd": (cov_nofold, (scaling, rotation)),
        "build_cov f+b": (lambda s, q: sum(
            jnp.sum(jnp.abs(x)) for x in jax.grad(cov_nofold, (0, 1))(s, q)),
            (scaling, rotation)),
        "cov+fold fwd": (cov_fold, (scaling, rotation, T)),
        "cov+fold f+b": (lambda s, q, t: sum(
            jnp.sum(jnp.abs(x)) for x in jax.grad(cov_fold, (0, 1, 2))(s, q, t)),
            (scaling, rotation, T)),
    }
    for name, (fn, args) in probes.items():
        dt = qt(jax.jit(fn), *args)
        print(f"{name:26s} {dt*1e3:8.3f} ms")



if __name__ == "__main__":
    import sys
    if "--cov" in sys.argv:
        main2()
    else:
        main()
        main2()
