"""Fine-tile probe at the large-mesh sizes (round 4, VERDICT item 4).

At 8192 faces each face's bbox is ~2-4 pixels tall, so a [CHUNK, 4x128]
sweep wastes most of its rows; 2-row tiles halve the swept lanes if the
visit multiplication (more (block, tile) overlaps + per-visit fixed cost)
stays below the saving.  t2 lost 17% at 512 faces (big faces: lane saving
only ~10%) but was never measured in the dense-face regime, and
COVER_FAST has since cut the per-lane op count ~16% -- re-balance both.

Forward only first; if t2 wins, the gradient side (t4/t2 at dilate=1
bboxes) gets its own A/B before any default moves.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_ftile
"""
try:
    from sweeps import _sweep_tiles2 as S
except ImportError:       # script mode (python sweeps/_sweep_ftile.py)
    import _sweep_tiles2 as S

# Production first (reference arm), production last to bracket drift.
S.probe(1024, fwd_variants=[(4, 64), (2, 64), (2, 32), (4, 64)],
        bwd_variants=[])
S.probe(256, fwd_variants=[(4, 64), (2, 64), (4, 64)],
        bwd_variants=[])
print("done", flush=True)
