"""Fourth fused-tile probe: does the forward's fine-granularity trend
continue (t2, c32), and do bigger gradient blocks (c256) win?

Usage (repo root, TPU env untouched):  python _sweep_tiles4.py
"""
import _sweep_tiles2 as S

S.probe(64, fwd_variants=[(2, 64), (4, 32)],
        bwd_variants=[(8, 128), (8, 256)])
S.probe(256, fwd_variants=[(2, 64), (4, 32)],
        bwd_variants=[(8, 128), (8, 256)])
S.probe(1024, fwd_variants=[(2, 64), (4, 32)],
        bwd_variants=[(8, 128), (8, 256)])
print("done", flush=True)
