"""Fixed faces-per-pixel resolution sweep (VERDICT item 10): face count
scales with pixel count (512 faces at 256^2 as the anchor)."""
import _sweep_r2 as S
S.run(16, 128, 16)     # 128 faces  @ 128^2
S.run(16, 256, 64)     # 512 faces  @ 256^2 (headline anchor)
S.run(4, 512, 256)     # 2048 faces @ 512^2
print('done', flush=True)
