"""Scalar/column helper functions (all JVM-side, codegen-friendly)."""
