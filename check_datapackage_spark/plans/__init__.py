"""Plan construction: fused single-pass validation plans."""
