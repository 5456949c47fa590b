"""Public API: Config / Context session state machine.

Reference parity: rav1e src/api/ (Config, Context<T>, send_frame /
receive_packet / flush, EncoderStatus), with rav1e-compatible
configuration key names (SURVEY §5.6).
"""

from rav1e_tpu.api.context import (  # noqa: F401
    Config,
    Context,
    EncoderStatus,
    Packet,
)
