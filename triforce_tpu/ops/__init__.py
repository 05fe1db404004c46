from . import attention, retrieval, sampling
