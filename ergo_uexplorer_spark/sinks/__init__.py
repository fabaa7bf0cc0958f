from .mock_cassandra import MockCassandraDataSource, register_mock_cassandra

__all__ = ["MockCassandraDataSource", "register_mock_cassandra"]
