"""Conformance oracle: decode bitstreams with dav1d and compare planes.

Mirrors rav1e's test strategy (reference: src/test_encode_decode/dav1d.rs,
SURVEY.md §4): every packet our encoder emits must decode, and the decoder
output must equal the encoder's own reconstruction bit-exactly.
"""
