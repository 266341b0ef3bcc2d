from . import datetimes, jsons, similarity, strings

__all__ = ["strings", "datetimes", "jsons", "similarity"]
