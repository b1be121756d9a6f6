"""Structured Streaming twins of the batch event analytics
(operators/events.py). See streaming/events.py."""
