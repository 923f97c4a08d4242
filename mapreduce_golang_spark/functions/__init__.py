from mapreduce_golang_spark.functions.tokenize import LETTERS_ONLY_RE, doc_name, tokenize, words

__all__ = ["LETTERS_ONLY_RE", "doc_name", "tokenize", "words"]
