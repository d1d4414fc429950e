"""Text analysis operators.

(Placeholder — populated in the text wave: language-ID, quality scoring,
token counting, document fingerprinting.)
"""
