"""ksoup_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of fleeksoft/ksoup
(a Kotlin multiplatform jsoup port): HTML5 tokenizer + tree construction,
CSS selector evaluation, whitespace-normalizing text extraction — expressed
as vectorized ``map_batches`` stages over Arrow batches on ``ray.data.Dataset``.

Layout:
  engine/     pure-Python per-document core (DOM, tokenizer, tree builder,
              selectors, text extraction, entities, charset sniffing).
              No Ray imports — unit-testable in isolation.
  stages/     Ray Data map_batches callables (actor pools for stateful parse).
  sources/    corpus synthesis + read helpers.
  functions/  training-data ops (dedup, ANN, text stats) over Datasets.
  pipelines/  end-to-end extraction pipeline with lineage + resume.
  state/      broadcast/lookup helpers (ray.put once, read per actor).
"""

__version__ = "0.1.0"
