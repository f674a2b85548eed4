/* Minimal stand-in for rocksdb/db.h so the reference's kvdb.hpp
 * parses without RocksDB; kvdb_stub.cpp reimplements the
 * KeyValueDatabase methods over an in-memory map. */
#pragma once
namespace rocksdb {
class DB {};
}
