"""Core: AV1 constants, encoder configuration, frame/plane storage.

Reference parity: rav1e src/partition.rs (BlockSize/TxSize enums),
src/api/config (EncoderConfig, SpeedSettings), v_frame Plane/Frame.
"""
