"""Large-mesh config reruns (65,536 faces at 512^2) for BASELINE.md.

Default sweep row (batch 4) uses the default per-tile face cap 8192, which
truncates the 6 busiest silhouette tiles (max measured 28,648 overlapping
faces); run with DIRT_TPU_TILE_FACE_CAP=32768 and batch 1 for oracle-exact
visibility (the uncapped/batch-4 tables exceed the 16 GB HBM).
"""
import os
import _sweep_r2 as S

batch = int(os.environ.get("LARGE_BATCH", "1"))
S.run(batch, 512, 8192, iters=3)
print('done', flush=True)
