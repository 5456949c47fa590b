"""Frame pipeline: encoder orchestration, GOP structure, rate control.

Reference parity: rav1e src/encoder.rs (encode_frame), src/api/internal
(frame scheduling), src/rate.rs, src/scenechange/. The numpy reference
pipeline here defines behavior; the TPU pipeline (parallel/) batches it.
"""
