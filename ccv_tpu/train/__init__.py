"""Cascade / model training tools (reference: bin/*create + the trainer
halves of lib/ccv_scd.c, ccv_bbf.c, ccv_icf.c)."""
