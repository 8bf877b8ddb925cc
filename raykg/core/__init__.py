"""Pure-Python core: the reference's matching semantics, no Ray, no spaCy."""
