from .gram_pallas import gram_pallas

__all__ = ["gram_pallas"]
