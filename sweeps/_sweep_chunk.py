"""Fine-chunk probe for the fused-CSR kernels in the dense-face regime.

At 2048/8192 faces each face covers only a few pixels, so a 64-face block
sweeping a whole [CHUNK, 512] tile plane wastes most rows; smaller blocks
cut sweep waste if their extra per-visit fixed cost (DMA wait + loop
overhead) stays below the saved vector work.  c32 lost at 512 faces (2.92
vs 2.70 ms) but was never measured at the dense-face sizes.

Usage (repo root, TPU env untouched):  python _sweep_chunk.py
"""
import _sweep_tiles2 as S

S.probe(256, fwd_variants=[(4, 32), (4, 16)],
        bwd_variants=[(8, 64), (8, 32)])
S.probe(1024, fwd_variants=[(4, 32), (4, 16)],
        bwd_variants=[(8, 64), (8, 32)])
print("done", flush=True)
