"""Bit-exact numpy reference implementations of AV1 coding ops.

These define conformance (decoder-matching) behavior; every Pallas
kernel must produce identical outputs (the reference's `check_asm`
discipline, SURVEY §5.2).
"""
