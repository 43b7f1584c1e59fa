from tdspa.core.embeddings import SinusoidalEmbedding, ParamStateInit
from tdspa.core.attention import (
    QKNormAttention,
    ParallelTransformerBlock,
    TransformerStack,
)
