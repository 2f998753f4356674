"""Engine function library: portable deterministic hashing/tokenizing
primitives shared by the dedup / similarity / text operators."""
