"""Structured Streaming operators (beyond-reference surface).

(Placeholder — populated in the streaming wave.)
"""
