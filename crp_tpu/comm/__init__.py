from .exchange import BExchangePlan, build_b_exchange, exchange_b

__all__ = ["BExchangePlan", "build_b_exchange", "exchange_b"]
