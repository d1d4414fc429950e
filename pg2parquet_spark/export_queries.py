"""Driver-facing queries exercising the export sink (SURVEY §2.A A5-A7).

(Placeholder — populated in the export wave.)
"""
