"""Pure-JAX training ray pipeline.

Role parity: ``nerf_sandbox/source/data/samplers.py:22-291``
(``RandomPixelRaySampler``) — per-step random pixel batches in two modes
(single-frame à la bmild, or mixed-frames), center precrop for the first
``precrop_iters`` steps, RGBA→white compositing, and the 7-key batch dict
{rgb, rays_o_world, rays_d_world_unit, rays_d_world_norm, rays_o_marching,
rays_d_marching_unit, rays_d_marching_norm} (samplers.py:193-201) — plus
two beyond-reference keys: ``radii`` (per-ray pixel-cone radii for the IPE
encoder, core/encoding.py:pixel_cone_radii) and ``frame_ids`` (per-ray
source-frame index for NeRF-W appearance-code lookup).

TPU-first redesign: instead of a host-side Python iterator with CPU↔GPU
pixel gathers and a per-frame fan-out loop (samplers.py:203-282), the whole
scene is stacked into device arrays once (images as uint8 — 4x less HBM
than fp32) and ``sample_ray_batch`` is a pure fixed-shape function of
(rng key, step) that runs INSIDE the jitted train step:

* frame ids / pixel indices via ``jax.random.randint`` (traced precrop
  bounds — no recompile when the crop window opens at ``precrop_iters``)
* one vectorised gather ``images[fids, ys, xs]`` (no per-frame loop)
* per-ray camera rays via a batched ``get_camera_rays`` (vmapped over the
  per-ray pose gather) — both sampler modes are the same compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_sandbox_tpu.core.rays import get_camera_rays
from nerf_sandbox_tpu.data.scene import Scene


class SceneArrays(NamedTuple):
    """The whole scene stacked into device-resident arrays.

    ``images`` may be frame-PADDED (to a multiple of the mesh's data-device
    count) when built by :meth:`from_scene_sharded`; ``Ks``/``c2ws`` always
    carry the real frame count, so ``n_frames`` reads from them.
    """

    images: jnp.ndarray   # (N_pad, H, W, C) uint8
    Ks: jnp.ndarray       # (N, 3, 3) float32
    c2ws: jnp.ndarray     # (N, 3, 4) float32
    # normalized frame times in [0,1] (dynamic scenes; zeros when static)
    times: jnp.ndarray | None = None

    @property
    def n_frames(self) -> int:
        return self.Ks.shape[0]

    @property
    def hw(self):
        return self.images.shape[1], self.images.shape[2]

    @staticmethod
    def _frame_uint8(f) -> np.ndarray:
        img = np.asarray(f.image)
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return img

    @staticmethod
    def _stack_numpy(scene: Scene):
        images = np.stack([SceneArrays._frame_uint8(f) for f in scene.frames],
                          axis=0)
        Ks = np.stack([np.asarray(f.K, np.float32) for f in scene.frames])
        c2ws = np.stack([f.c2w_3x4() for f in scene.frames])
        return images, Ks, c2ws

    @staticmethod
    def _times(scene: Scene) -> np.ndarray:
        return np.asarray([f.time if f.time is not None else 0.0
                           for f in scene.frames], np.float32)

    @staticmethod
    def from_scene(scene: Scene) -> "SceneArrays":
        images, Ks, c2ws = SceneArrays._stack_numpy(scene)
        return SceneArrays(jnp.asarray(images), jnp.asarray(Ks),
                           jnp.asarray(c2ws),
                           jnp.asarray(SceneArrays._times(scene)))

    @staticmethod
    def from_scene_sharded(scene: Scene, plan) -> "SceneArrays":
        """Build a FRAME-SHARDED scene bank on the plan's mesh.

        The image bank — by far the dominant scene memory (N·H·W·C vs 21
        floats of camera data per frame) — is sharded over the mesh's data
        axes along the frame dimension, dividing per-device HBM by the data
        device count; ``Ks``/``c2ws`` stay replicated (the in-jit one-hot
        camera lookup needs them everywhere, and they are tiny).  Frames are
        zero-padded to an equal split.  Under multi-process execution each
        process materialises ONLY the frame blocks its addressable devices
        own (``jax.make_array_from_callback``) — paired with the loaders'
        ``image_filter`` this is per-host data loading: no host ever decodes
        or stores frames it doesn't serve.  The reference has no analogue
        (single-process; its closest knob is CPU-pinned image caching,
        samplers.py:94-114); this is the SURVEY §5 DCN-scale data path.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = plan.mesh
        assert mesh is not None, "from_scene_sharded needs a mesh"
        frames = scene.frames
        shape0 = SceneArrays._frame_uint8(frames[0]).shape
        data_axes = tuple(a for a in mesh.axis_names if a != "model")
        D = int(np.prod([mesh.shape[a] for a in data_axes]))
        N = len(frames)
        per = -(-N // D)

        def block(idx):
            # assemble ONLY the requested frame rows (a local device's
            # block) — the full padded (N_pad, H, W, C) bank is never
            # materialised in host memory, so host RAM scales with the
            # process's owned frames, matching the per-host decode contract
            sl = idx[0]
            rows = range(sl.start or 0, sl.stop if sl.stop is not None
                         else D * per)
            return np.stack([SceneArrays._frame_uint8(frames[i]) if i < N
                             else np.zeros(shape0, np.uint8) for i in rows])

        sh = NamedSharding(mesh, P(data_axes, None, None, None))
        imgs = jax.make_array_from_callback((D * per, *shape0), sh, block)
        Ks = np.stack([np.asarray(f.K, np.float32) for f in frames])
        c2ws = np.stack([f.c2w_3x4() for f in frames])
        rep = NamedSharding(mesh, P())
        return SceneArrays(
            imgs, jax.device_put(jnp.asarray(Ks), rep),
            jax.device_put(jnp.asarray(c2ws), rep),
            jax.device_put(jnp.asarray(SceneArrays._times(scene)), rep))


class RayBatchSpec(NamedTuple):
    """Static sampler configuration (hashable → one jit specialisation)."""

    rays_per_batch: int
    image_h: int
    image_w: int
    convention: str = "opengl"
    as_ndc: bool = False
    near_plane: float = 1.0
    white_bkgd: bool = True
    single_frame: bool = False
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    # Image bank is frame-sharded over the mesh (from_scene_sharded);
    # the pixel fetch becomes a shard_map masked local gather + psum.
    shard_frames: bool = False


def _crop_bounds(step, spec: RayBatchSpec):
    """Center-crop pixel bounds for the first precrop_iters steps.

    Matches samplers.py:119-127; returns traced (h0, h1, w0, w1) so the
    crop→full transition does not trigger a recompile.
    """
    H, W = spec.image_h, spec.image_w
    if spec.precrop_iters <= 0 or not (0.0 < spec.precrop_frac < 1.0):
        return (jnp.int32(0), jnp.int32(H), jnp.int32(0), jnp.int32(W))
    f = spec.precrop_frac
    ch0, ch1 = int(H * 0.5 * (1.0 - f)), int(H * 0.5 * (1.0 + f))
    cw0, cw1 = int(W * 0.5 * (1.0 - f)), int(W * 0.5 * (1.0 + f))
    # `step` is the 1-based in-progress step; the reference gates on a
    # 0-based completed count (< precrop_iters), so <= here yields the same
    # precrop_iters cropped batches (not precrop_iters - 1).
    active = step <= spec.precrop_iters
    h0 = jnp.where(active, ch0, 0).astype(jnp.int32)
    h1 = jnp.where(active, ch1, H).astype(jnp.int32)
    w0 = jnp.where(active, cw0, 0).astype(jnp.int32)
    w1 = jnp.where(active, cw1, W).astype(jnp.int32)
    return h0, h1, w0, w1


def _sharded_pixel_gather(images: jnp.ndarray, fids, ys, xs, mesh) -> jnp.ndarray:
    """Pixel fetch from a FRAME-SHARDED image bank → (B, C) float 0..255.

    Each device gathers the whole batch's pixels from its local frame block
    (out-of-range rows masked to zero) and one psum over the data axes fills
    every row from its owner — B·C floats of collective traffic per step
    (KBs), vs replicating N·H·W·C images into every device's HBM.  The
    frame→device mapping is the mesh's row-major data-axis order, matching
    ``from_scene_sharded``'s axis-0 NamedSharding layout.
    """
    from jax.sharding import PartitionSpec as P
    data_axes = tuple(a for a in mesh.axis_names if a != "model")
    D = int(np.prod([mesh.shape[a] for a in data_axes]))
    per = images.shape[0] // D

    def local(imgs, f, y, x):
        idx = jnp.int32(0)
        for ax in data_axes:
            idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
        lo = idx * per
        loc = jnp.clip(f - lo, 0, per - 1)
        vals = imgs[loc, y, x].astype(jnp.float32)            # (B, C)
        mask = ((f >= lo) & (f < lo + per)).astype(jnp.float32)
        return jax.lax.psum(vals * mask[:, None], data_axes)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axes, None, None, None), P(), P(), P()),
        out_specs=P(), check_vma=False)(images, fids, ys, xs)


def sample_pixels(key: jax.Array, step: jnp.ndarray, scene: SceneArrays,
                  spec: RayBatchSpec, plan=None) -> dict:
    """Stage 1: draw (frame, pixel) ids and fetch target colors.

    Pure and NON-differentiable (integer draws + image gather); the
    differentiable half is :func:`rays_for_pixels`. Split so that
    ``--pose_opt`` can generate rays INSIDE the loss closure (gradients
    flow through ray generation into the per-frame pose deltas) while the
    pixel draw stays outside it.
    """
    B = spec.rays_per_batch
    n_frames = scene.n_frames
    k_fid, k_y, k_x = jax.random.split(key, 3)

    if spec.single_frame:
        fid = jax.random.randint(k_fid, (), 0, n_frames)
        fids = jnp.full((B,), fid, jnp.int32)
    else:
        fids = jax.random.randint(k_fid, (B,), 0, n_frames)

    h0, h1, w0, w1 = _crop_bounds(step, spec)
    ys = jax.random.randint(k_y, (B,), h0, h1)
    xs = jax.random.randint(k_x, (B,), w0, w1)

    if spec.shard_frames:
        assert plan is not None and plan.mesh is not None, \
            "spec.shard_frames requires a mesh plan"
        pix = _sharded_pixel_gather(scene.images, fids, ys, xs,
                                    plan.mesh) / 255.0         # (B, C)
    else:
        pix = scene.images[fids, ys, xs].astype(jnp.float32) / 255.0   # (B, C)
    if pix.shape[-1] == 4:
        if spec.white_bkgd:
            rgb = pix[..., :3] * pix[..., 3:4] + (1.0 - pix[..., 3:4])
        else:
            rgb = pix[..., :3]
    else:
        rgb = pix
    return {"rgb": rgb, "frame_ids": fids, "xs": xs, "ys": ys}


def rays_for_pixels(scene: SceneArrays, spec: RayBatchSpec, fids, xs, ys,
                    pose_delta=None) -> dict:
    """Stage 2: per-ray camera lookup + ray generation (differentiable).

    ``pose_delta`` (B, 6) — optional per-ray se3 deltas (core/pose.py)
    left-composed onto the looked-up c2w rows; None is bit-identical to
    the historical single-stage path.
    """
    n_frames = scene.n_frames
    # Per-ray camera lookup as a one-hot contraction: row gathers lower to
    # slow serialized loads on TPU, while an (B,N)x(N,21) matmul is free at
    # these sizes (N = #frames).
    oh = jax.nn.one_hot(fids, n_frames, dtype=jnp.float32)         # (B, N)
    times = (scene.times if scene.times is not None
             else jnp.zeros((n_frames,), jnp.float32))
    cams = jnp.concatenate([scene.Ks.reshape(n_frames, 9),
                            scene.c2ws.reshape(n_frames, 12),
                            times.reshape(n_frames, 1)], axis=-1)
    # HIGHEST: the TPU default would round K/c2w to bf16 (~0.4% on an
    # 1111.1 focal) and misalign every training ray; this matmul is tiny.
    cam_rows = jnp.matmul(oh, cams,
                          precision=jax.lax.Precision.HIGHEST)     # (B, 21)
    Ks = cam_rows[:, :9].reshape(-1, 3, 3)                         # (B, 3, 3)
    c2ws = cam_rows[:, 9:21].reshape(-1, 3, 4)                     # (B, 3, 4)
    t = cam_rows[:, 21]                                            # (B,)
    if pose_delta is not None:
        from nerf_sandbox_tpu.core.pose import apply_pose_delta
        c2ws = apply_pose_delta(c2ws, pose_delta)
    pixels_xy = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32)], -1)

    ray_fn = partial(get_camera_rays, image_h=spec.image_h, image_w=spec.image_w,
                     convention=spec.convention, pixel_center=True,
                     as_ndc=spec.as_ndc, near_plane=spec.near_plane)
    rays = jax.vmap(ray_fn)(Ks, c2ws, pixels_xy)

    # Per-ray pixel-cone radii for IPE (core/encoding.py:pixel_cone_radii):
    # fx is per-ray (mixed-frame batches may mix cameras). World-space —
    # IPE is gated to non-NDC runs, where marching == world.
    from nerf_sandbox_tpu.core.encoding import pixel_cone_radii
    radii = pixel_cone_radii(cam_rows[:, 0], rays.d_world_norm[..., 0])

    return {
        "rays_o_world": rays.o_world,
        "rays_d_world_unit": rays.d_world_unit,
        "rays_d_world_norm": rays.d_world_norm,
        "rays_o_marching": rays.o_march,
        "rays_d_marching_unit": rays.d_march_unit,
        "rays_d_marching_norm": rays.d_march_norm,
        "radii": radii,
        # per-ray normalized frame time (dynamic scenes; zeros when static)
        "t": t,
    }


@partial(jax.jit, static_argnames=("spec", "plan"))
def sample_ray_batch(key: jax.Array, step: jnp.ndarray, scene: SceneArrays,
                     spec: RayBatchSpec, plan=None) -> dict:
    """Draw one training batch of rays. Pure; runs inside the train step.

    ``plan`` (static MeshPlan) is only consulted when ``spec.shard_frames``
    — the frame-sharded image bank needs the mesh for its gather.
    Composition of :func:`sample_pixels` + :func:`rays_for_pixels` (ops and
    order identical to the historical single-stage implementation).
    """
    pix = sample_pixels(key, step, scene, spec, plan=plan)
    rays = rays_for_pixels(scene, spec, pix["frame_ids"], pix["xs"],
                           pix["ys"])
    return {
        "rgb": pix["rgb"],
        **rays,
        # source-frame index per ray (appearance-embedding lookup)
        "frame_ids": pix["frame_ids"],
    }
