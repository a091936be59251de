"""Pallas TPU kernels for the hot ops (+ XLA fallbacks).

Reference analog: the reference's "native tier" is its code-generated
unrolled Java hot loops (SURVEY §2: no real native code exists there);
here the same role is played by Pallas kernels where XLA's generic
lowering leaves performance on the table — most notably the KLT
iteration loop, whose 60 sequential tiny gather stages under XLA pay
per-stage overhead that a single fused kernel avoids.
"""
