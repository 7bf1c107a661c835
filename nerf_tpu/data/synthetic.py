"""Procedural synthetic scene generator.

No external dataset ships with this environment, so training, eval, and
benchmarking run against a procedurally generated multi-view dataset: an
analytic density/albedo field (a handful of Gaussian blobs) rendered with the
exact same volume-rendering math the models are trained with.  The data is
therefore perfectly self-consistent across views — a correct NeRF pipeline
must drive PSNR up on it, making it a real end-to-end convergence oracle, not
just a smoke fixture.

``write_blender_dataset`` serializes a generated scene in the Blender
transforms_{split}.json + PNG layout so the real dataset loader
(nerf_tpu.data.blender) is exercised end-to-end as well.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.core import rays as rays_lib
from nerf_tpu.core.render import transmittance_weights
from nerf_tpu.data.blender import BlenderDataset

DEFAULT_FOV = 0.6911112070083618  # blender lego camera_angle_x


def _scene_params(seed: int, n_blobs: int = 5, specular: float = 0.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.7, 0.7, (n_blobs, 3)).astype(np.float32)
    scales = rng.uniform(0.15, 0.35, (n_blobs,)).astype(np.float32)
    colors = rng.uniform(0.1, 1.0, (n_blobs, 3)).astype(np.float32)
    peak = rng.uniform(20.0, 60.0, (n_blobs,)).astype(np.float32)
    return (jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(colors),
            jnp.asarray(peak), float(specular))


def field_fn(scene):
    """Returns f(points (..., 3), dirs (..., 3) or None) -> (density, rgb).

    With a nonzero specular coefficient the radiance is view-dependent:
    each blob adds a Phong-like facing highlight ks * max(0, -d_hat.n_hat)^8
    where n_hat points from the blob center to the sample — a consistent
    L(x, d) that diffuse models cannot fit but view-direction-aware models
    (vanilla's dir-conditioned RGB head, Ref-NeRF's reflection IDE) can.
    """
    centers, scales, colors, peak, specular = scene

    def f(pts, dirs=None):
        d2 = jnp.sum((pts[..., None, :] - centers) ** 2, axis=-1)  # (..., B)
        contrib = peak * jnp.exp(-0.5 * d2 / scales**2)            # (..., B)
        density = jnp.sum(contrib, axis=-1)
        w = contrib / (density[..., None] + 1e-8)
        rgb = w @ colors
        if specular > 0.0 and dirs is not None:
            d_hat = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
            n_vec = pts[..., None, :] - centers                    # (..., B, 3)
            n_hat = n_vec / (jnp.linalg.norm(n_vec, axis=-1, keepdims=True) + 1e-8)
            facing = jnp.maximum(0.0, -jnp.sum(d_hat[..., None, :] * n_hat, axis=-1))
            rgb = rgb + specular * jnp.sum(w * facing**8, axis=-1, keepdims=True)
        return density, rgb

    return f


def _objects_scene_params(seed: int):
    """Scene family #2: solid objects over a textured ground plane.

    Structurally different from the Gaussian-blob family: near-opaque
    sigmoid-edged solids (hard surfaces, mutual occlusion, cast silhouettes)
    plus a finite checker-textured ground slab — the multi-object/occlusion
    regime the blob scene never exercises (VERDICT r4 #7).  All fields stay
    analytic and smooth so the same dense-quadrature GT renderer applies.
    """
    rng = np.random.default_rng(seed)
    jit3 = lambda s: rng.uniform(-s, s, 3).astype(np.float32)
    objects = {
        # a tall central pillar that occludes everything behind it
        "box_center": np.array([0.0, 0.0, -0.10], np.float32) + jit3(0.05),
        "box_half": np.array([0.16, 0.16, 0.45], np.float32),
        # a sphere beside the pillar (hidden from ~half the azimuths)
        "sph_center": np.array([0.52, 0.36, -0.32], np.float32) + jit3(0.05),
        "sph_radius": np.float32(0.22),
        # a torus lying flat on the ground
        "tor_center": np.array([-0.46, 0.40, -0.46], np.float32) + jit3(0.04),
        "tor_R": np.float32(0.26),
        "tor_r": np.float32(0.09),
        # a small sphere tucked behind the pillar
        "sph2_center": np.array([-0.36, -0.46, -0.40], np.float32) + jit3(0.04),
        "sph2_radius": np.float32(0.15),
        # ground slab
        "ground_z": np.float32(-0.56),
        "ground_ext": np.float32(1.15),
        # albedos: 4 object colors + 2 checker colors
        "colors": rng.uniform(0.15, 0.95, (4, 3)).astype(np.float32),
        "checker": np.stack([
            rng.uniform(0.55, 0.9, 3), rng.uniform(0.05, 0.35, 3),
        ]).astype(np.float32),
    }
    return {k: jnp.asarray(v) for k, v in objects.items()}


def field_fn_objects(p):
    """f(points, dirs) -> (density, rgb) for the objects family (diffuse).

    Solids are sigmoid-edged indicator fields (edge width ~0.04, >= 2 GT
    quadrature samples at the default 192-sample [2,6] grid) with peak
    density 60 — effectively opaque, so surfaces and occlusion are real.
    """
    EDGE = 0.04
    PEAK = 60.0

    def sig(x):
        return jax.nn.sigmoid(x / EDGE)

    def f(pts, dirs=None):
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        # ground: gaussian slab in z, smooth radial extent, checker albedo
        rad = jnp.sqrt(x * x + y * y + 1e-12)
        d_ground = (PEAK * jnp.exp(-0.5 * ((z - p["ground_z"]) / 0.04) ** 2)
                    * jax.nn.sigmoid((p["ground_ext"] - rad) / 0.08))
        t = jax.nn.sigmoid(jnp.sin(5.0 * x) * jnp.sin(5.0 * y) / 0.15)
        c_ground = (p["checker"][0] * (1.0 - t[..., None])
                    + p["checker"][1] * t[..., None])
        # box pillar: product of per-axis sigmoid indicators
        db = jnp.abs(pts - p["box_center"]) - p["box_half"]
        d_box = PEAK * jnp.prod(sig(-db), axis=-1)
        # spheres
        r1 = jnp.linalg.norm(pts - p["sph_center"], axis=-1)
        d_sph = PEAK * sig(p["sph_radius"] - r1)
        r2 = jnp.linalg.norm(pts - p["sph2_center"], axis=-1)
        d_sph2 = PEAK * sig(p["sph2_radius"] - r2)
        # torus (axis = z): distance to the centre circle
        dt = pts - p["tor_center"]
        ring = jnp.sqrt(dt[..., 0] ** 2 + dt[..., 1] ** 2 + 1e-12) - p["tor_R"]
        d_tor = PEAK * sig(p["tor_r"] - jnp.sqrt(ring**2 + dt[..., 2] ** 2 + 1e-12))

        dens = jnp.stack([d_ground, d_box, d_sph, d_sph2, d_tor], axis=-1)
        density = jnp.sum(dens, axis=-1)
        w = dens / (density[..., None] + 1e-8)
        # sphere #1 carries a vertical albedo gradient (texture on a solid)
        grad1 = 0.6 + 0.4 * jax.nn.sigmoid((z - p["sph_center"][2])
                                           / p["sph_radius"])
        cols = jnp.stack([
            jnp.broadcast_to(p["colors"][0], pts.shape),
            p["colors"][1] * grad1[..., None],
            jnp.broadcast_to(p["colors"][2], pts.shape),
            jnp.broadcast_to(p["colors"][3], pts.shape),
        ], axis=-2)                                       # (..., 4, 3)
        rgb = (w[..., :1] * c_ground
               + jnp.sum(w[..., 1:, None] * cols, axis=-2))
        return density, rgb

    return f


def render_gt_image(scene, c2w, hw, focal, near=2.0, far=6.0, n_samples=192,
                    white_bkg=True, chunk=4096):
    """Ground-truth render of the analytic field with dense quadrature.

    ``scene`` is either a blob-family scene tuple (see _scene_params) or a
    ready field callable f(points, dirs) -> (density, rgb)."""
    h, w = hw
    f = scene if callable(scene) else field_fn(scene)
    all_rays = rays_lib.full_image_rays(h, w, jnp.asarray(c2w[:3, :]), focal)

    mids = jnp.linspace(near, far, n_samples + 1)
    zvals = 0.5 * (mids[1:] + mids[:-1])

    def render_chunk(r):
        o, d = r[..., :3], r[..., 3:]
        norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
        pts = o[:, None, :] + d[:, None, :] * zvals[None, :, None]
        density, rgb = f(pts, jnp.broadcast_to(d[:, None, :], pts.shape))
        z_metric = zvals[None, :] * norm
        # honest final bin width instead of the model-side 1e10 sentinel:
        # the sentinel saturates on the Gaussians' never-exactly-zero tails
        # (density ~4e-10 at the far plane -> alpha ~0.98 of the near-black
        # 1e-8-normalized tail color), painting dark silhouette halos no
        # model can fit — the round-3 "16.0-PSNR pose" (BENCHMARKS.md r4)
        wgt = transmittance_weights(density, z_metric, density_act=lambda x: x,
                                    final_delta=(far - near) / n_samples * norm)
        out = jnp.sum(wgt[..., None] * rgb, axis=-2)
        if white_bkg:
            out = out + (1.0 - jnp.sum(wgt, axis=-1, keepdims=True))
        return out

    n_pix = h * w
    pad = (-n_pix) % chunk
    padded = jnp.concatenate([all_rays, jnp.zeros((pad, 6))], axis=0)
    chunks = padded.reshape(-1, chunk, 6)
    img = jax.lax.map(jax.jit(render_chunk), chunks).reshape(-1, 3)[:n_pix]
    return np.asarray(img.reshape(h, w, 3)).clip(0.0, 1.0)


def make_synthetic_scene(n_train: int = 20, n_test: int = 4, hw=(100, 100),
                         seed: int = 0, fov: float = DEFAULT_FOV,
                         white_bkg: bool = True, n_samples: int = 192,
                         specular: float = 0.0, family: str = "blobs"):
    """Generate (train, test) BlenderDataset pairs from an analytic scene.

    ``specular`` > 0 adds view-dependent facing highlights (see field_fn) —
    the shiny-scene analogue of the reference's shiny-blender evaluations.
    ``family`` picks the scene generator: "blobs" (Gaussian mixture) or
    "objects" (solid multi-object + textured ground, diffuse only)."""
    if family == "objects":
        if specular:
            raise ValueError("the objects family is diffuse-only")
        scene = field_fn_objects(_objects_scene_params(seed))
    elif family == "blobs":
        scene = _scene_params(seed, specular=specular)
    else:
        raise ValueError(f"unknown scene family {family!r}")
    focal = rays_lib.fov_to_focal(fov, hw)

    rng = np.random.default_rng(seed + 1)

    def gen(n, phase):
        thetas = np.linspace(-180, 180, n, endpoint=False) + phase
        phis = rng.uniform(-45, -15, n)
        poses4 = np.stack([rays_lib.pose_spherical(t, p, 4.0) for t, p in zip(thetas, phis)])
        imgs = np.stack([
            render_gt_image(scene, p, hw, focal, white_bkg=white_bkg, n_samples=n_samples)
            for p in poses4
        ])
        return imgs.astype(np.float32), poses4.astype(np.float32)

    tr_imgs, tr_poses = gen(n_train, 0.0)
    te_imgs, te_poses = gen(n_test, 7.3)
    train = BlenderDataset(tr_imgs, tr_poses[:, :3, :], fov, names=[f"r_{i}.png" for i in range(n_train)])
    test = BlenderDataset(te_imgs, te_poses[:, :3, :], fov, names=[f"r_{i}.png" for i in range(n_test)])
    return train, test, (tr_poses, te_poses)


def write_blender_dataset(root: str, dataset: BlenderDataset, poses4: np.ndarray,
                          split: str = "train"):
    """Serialize a dataset in the Blender layout to exercise the loader."""
    from PIL import Image

    img_dir = os.path.join(root, split)
    os.makedirs(img_dir, exist_ok=True)
    frames = []
    for i in range(len(dataset)):
        name = f"r_{i}.png"
        arr = (dataset.images[i] * 255.0 + 0.5).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        frames.append({
            "file_path": f"./{split}/r_{i}",
            "transform_matrix": poses4[i].tolist(),
        })
    meta = {"camera_angle_x": float(dataset.fov), "frames": frames}
    with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
        json.dump(meta, f)
