"""Measured-negative kernels, kept for the record but NOT routed.

Nothing in production dispatch (ops/eig_qr_real.py) imports from here.
Each module is a complete, interpret-tested kernel that lost a chip A/B
against the routed path; the measurements live in NOTES_NEXT_ROUND.md
("Measured negative results") so the experiments are not redone:

* eig_qr_pallas_baed — batched AED + multishift chase for the small-n
  batched kernel: loses to the single-shift acc kernel at bench scale
  (b=8, n=338: 298-829 ms vs 211 ms) because the batched chase is
  per-rotation-overhead-bound and the in-kernel window Schur is
  serial-step-bound.  Tests: tests/test_eig_baed.py.
* eig_qr_pallas_packed — packed re|im lane layout for the batched QR
  chase: 0.82-0.88x the split-layout kernel on chip (halved op count
  loses to doubled lane width + the half-swap roll/sign algebra of the
  packed rotation).  Tests: tests/test_eig_packed.py.
"""
