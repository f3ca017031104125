"""Visit statistics for the fused-CSR forward schedule (CPU, binning only).

Counts, per config, what the binning pre-pass actually schedules: (tile,
block) visits per image, the live sub-chunk range widths (what SUBCLIP
sweeps), and the implied lane counts with/without sub-chunk clipping.
Pure XLA pre-pass math — no kernels — so it runs on CPU and quantifies the
*available* sweep-width reduction before paying for a device A/B.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m sweeps._probe_visits
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_cpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import forward_blocks, forward_pallas
import bench as B


def _cdiv(a, b):
    return -(-a // b)


def probe(segments, res=256, batch=1):
    bg, clip, colors, faces, _ = B.build_scene(batch, res, segments)
    num_faces = faces.shape[1]
    h = w = res
    tile_h, tile_w = forward_blocks.tile_h_for(), forward_blocks.TILE_W
    chunk = forward_blocks.chunk_for()
    sub = 8      # f32 sublane tile (the removed SUBCLIP granularity)
    num_blocks = _cdiv(num_faces, chunk)
    tiles_y, tiles_x = _cdiv(h, tile_h), _cdiv(w, tile_w)
    n_sub = chunk // sub

    def pack(v, c, f):
        fd = forward_pallas._face_table(
            v, c, f, h, w, num_blocks * chunk - num_faces)
        if forward_blocks.SPATIAL:
            order = forward_blocks.spatial_order(
                fd, (20, 21, 22, 23), tile_h, tile_w)
            fd = jnp.take(fd, order, axis=0)
        hit = forward_blocks.hit_matrix(
            fd, (20, 21, 22, 23), num_blocks, chunk,
            tiles_y, tiles_x, tile_h, tile_w,
            edge_cols=0, height=h, width=w)
        # Exact per-(tile, face) hits inside the same cull, for the
        # useful-lane floor (and for the sub-chunk live-range stats below).
        full = forward_blocks.hit_matrix(
            fd, (20, 21, 22, 23), num_blocks * chunk, 1,
            tiles_y, tiles_x, tile_h, tile_w,
            edge_cols=0, height=h, width=w)
        return hit, full

    hit, full = jax.jit(pack)(clip[0], colors[0], faces[0])
    hit, full = np.asarray(hit), np.asarray(full)
    visits = int(hit.sum())
    # Live sub-chunk range per (tile, block): what the (since-removed)
    # SUBCLIP sweep would have clipped to -- kept for provenance.
    sub_hit = full.reshape(-1, num_blocks, chunk // sub, sub).any(-1)
    s = np.arange(chunk // sub)
    lo = np.where(sub_hit, s, chunk // sub).min(-1)
    hi = np.where(sub_hit, s + 1, 0).max(-1)
    live = np.where(hit, hi - lo, 0)
    pix = tile_h * tile_w
    lanes_full = visits * chunk * pix
    lanes_clip = int(live.sum()) * sub * pix
    lanes_exact = int(full.sum()) * pix     # 1 lane-row per live face-visit
    print(f"{num_faces:6d} faces  t{tile_h}x{tile_w} c{chunk}: "
          f"visits/img {visits:6d}  "
          f"avg live range {live[hit].mean() if visits else 0:5.2f}/{n_sub} sub-chunks  "
          f"lanes full {lanes_full/1e6:7.1f}M  clip {lanes_clip/1e6:7.1f}M "
          f"({lanes_clip/max(lanes_full,1):5.1%})  "
          f"face-exact floor {lanes_exact/1e6:7.1f}M "
          f"({lanes_exact/max(lanes_full,1):5.1%})", flush=True)


if __name__ == "__main__":
    for seg in (64, 256, 1024):          # 512 / 2048 / 8192 faces
        probe(seg)
    print("done", flush=True)
