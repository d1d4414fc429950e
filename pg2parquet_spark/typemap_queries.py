"""Driver-facing queries exercising the typemap layer (SURVEY §2.A).

(Placeholder — populated in the typemap wave.)
"""
