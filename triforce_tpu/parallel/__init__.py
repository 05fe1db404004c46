from . import mesh, sharding
