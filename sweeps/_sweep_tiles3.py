"""Third fused-tile probe: c64 corners (fwd t8/t4 c64 at all sizes,
bwd t8 c64) -- final data for the production autos.

Usage (repo root, TPU env untouched):  python _sweep_tiles3.py
"""
import _sweep_tiles2 as S

S.probe(64, fwd_variants=[(4, 64)], bwd_variants=[(8, 128), (8, 64)])
S.probe(256, fwd_variants=[(4, 64)], bwd_variants=[(8, 128), (8, 64)])
S.probe(1024, fwd_variants=[(8, 64), (4, 64)],
        bwd_variants=[(8, 128), (8, 64)])
print("done", flush=True)
