"""Populated later in this round."""
