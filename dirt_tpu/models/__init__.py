"""Renderer model families: the reference's canonical pipelines as modules.

The reference ships its pipelines as sample scripts (samples/simple.py,
deferred.py, textured.py); here they are reusable, jittable model classes so
samples, benchmarks and training loops share one implementation:

  * GouraudRenderer  -- direct per-vertex lighting (samples/simple.py:30-74)
  * DeferredPhongRenderer -- G-buffer + per-pixel ambient/diffuse/specular
    (samples/deferred.py:25-117)
  * TexturedRenderer -- UV G-buffer + bilinear texture sampling + diffuse
    (samples/textured.py:64-158)
"""

from .renderers import DeferredPhongRenderer, GouraudRenderer, TexturedRenderer

__all__ = ["GouraudRenderer", "DeferredPhongRenderer", "TexturedRenderer"]
