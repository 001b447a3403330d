"""Sentiment analysis example (cf. kjarni-examples/examples/sentiment.rs)."""

from kjarni_tpu import Classifier

clf = Classifier("distilbert-sentiment")
for text in ("I love this product!", "Terrible quality", "Best purchase ever"):
    print(f"{text!r:40} -> {clf.classify(text)}")
