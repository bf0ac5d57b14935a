"""Model lifecycle: weight import/export, AOT serialization, quantization."""
