"""Large-scale training-data operators over document/embedding tables."""
