"""Entropy coding: bit IO, the od_ec range coder, CDF state, tile packing.

Reference parity: rav1e src/ec.rs (WriterEncoder/WriterCounter),
src/context/cdf_context.rs (CDF tables + checkpointing), src/header.rs
(OBU/uncompressed header bit writing). See SURVEY.md §2.2.

TPU-first split: batched search prices symbols against static CDF cost
tables (ops/ + search/); only this package runs the exact serial coder.
"""
