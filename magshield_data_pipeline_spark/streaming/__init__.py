"""Structured Streaming tier (SURVEY §2.10 [EXT])."""
