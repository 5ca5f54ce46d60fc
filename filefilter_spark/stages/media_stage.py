"""Zero-code pipeline stage over the multimodal kernels.

Same idea as ``corpus_stage``: expose the media tier (``ops/
multimodal.py`` + the from-spec codecs) to YAML authors without code.
One ``media`` actionType with an ``op`` selector:

.. code-block:: yaml

    filters:
      - name: image_meta
        actionType: media
        actionConfig: {op: decode, payloadField: content, idField: doc_id}
      - name: thumbs
        actionType: media
        actionConfig:
          op: resize
          payloadField: content
          idField: doc_id
          width: 64
          height: 64
          format: jpeg
      - name: audio_meta
        actionType: media
        actionConfig: {op: audio, payloadField: content, idField: doc_id}
      - name: frames
        actionType: media
        actionConfig: {op: frames, payloadField: content, everyN: 30}

``fake: true`` (default false) switches to the deterministic stub
kernels for plumbing tests on payloads that aren't real media. Unlike
the corpus stages these produce a NEW schema (typed metadata or frame
fan-out), matching how the decode/resize operators behave everywhere
else in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from filefilter_spark.stages.base import Stage


class MediaStage(Stage):
    """Dispatch on ``actionConfig.op``: decode | resize | audio | frames."""

    def apply(self, df: DataFrame) -> DataFrame:
        from filefilter_spark.ops.multimodal import (
            extract_audio_features_stub,
            extract_image_features,
            frame_sample_stub,
            resize_images_stub,
            to_media_table,
        )

        cfg = self.cfg.action_config
        op = cfg.get("op")
        fake = bool(cfg.get("fake", False))
        # Per-row corrupt-payload policy (ops/multimodal.py module
        # docstring); YAML pipelines over scraped media usually want
        # "skip" or "null" — the default stays "raise" to match the
        # kernels.
        on_error = cfg.get("onError", "raise")
        media_type = {"audio": "audio", "frames": "video"}.get(op, "image")
        media = to_media_table(
            df,
            id_col=cfg.get("idField", "doc_id"),
            payload_col=cfg.get("payloadField", "content"),
            media_type=media_type,
        )
        if op == "decode":
            return extract_image_features(media, fake=fake, on_error=on_error)
        if op == "resize":
            return resize_images_stub(
                media,
                width=int(cfg.get("width", 224)),
                height=int(cfg.get("height", 224)),
                fake=fake,
                out_format=cfg.get("format", "png"),
                on_error=on_error,
            )
        if op == "audio":
            return extract_audio_features_stub(media, fake=fake, on_error=on_error)
        if op == "frames":
            return frame_sample_stub(
                media, every_n=int(cfg.get("everyN", 30)), fake=fake,
                on_error=on_error,
            )
        raise ValueError(
            f"media stage op must be decode/resize/audio/frames, got {op!r}"
        )
