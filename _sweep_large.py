"""Large-mesh config only (512^2, b4, 65536 faces), for cap-setting reruns."""
import _sweep_r2 as S
S.run(4, 512, 8192, iters=3)
print('done', flush=True)
