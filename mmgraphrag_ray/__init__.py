"""mmgraphrag_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the query/data-processing capabilities of
ufdatastudio/MMGraphRAG (reference at /root/reference, cited by file:line in
docstrings) re-expressed as streaming ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches:

- token-window chunking      (reference: preprocessing.py:30-78)
- triple extraction          (reference: text2graph.py:281-463, prompt grammar)
- node/edge merge algebra    (reference: text2graph.py:140-279)
- entity linking / fusion    (reference: fusion.py:333-416, 870-997)
- vector index + similarity  (reference: storage.py:233-326)
- exact & near dedup, text quality ops for training-data pipelines

No code is copied from the reference; it defines WHAT to compute, this
package decides HOW on Ray Data.
"""

__version__ = "0.1.0"

GRAPH_FIELD_SEP = "<SEP>"  # reference: prompt.py:1
