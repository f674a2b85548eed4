/* In-memory KeyValueDatabase implementing the reference's kvdb.hpp
 * interface (put/get/clear) over a std::map -- replaces kvdb.cpp's
 * RocksDB backend for the feed-less align-path oracle.  Read state
 * still round-trips through the reference's own binary serialization
 * (read.cpp toBinString/load_db) exactly as in a real run. */
#include <map>
#include <string>

#include "kvdb.hpp"

static std::map<std::string, std::string> g_store;

KeyValueDatabase::KeyValueDatabase(std::string const&) : kvdb(nullptr) {}

void KeyValueDatabase::put(std::string key, std::string val) {
    g_store[key] = val;
}

std::string KeyValueDatabase::get(std::string key) {
    auto it = g_store.find(key);
    return it == g_store.end() ? std::string() : it->second;
}

int KeyValueDatabase::clear(std::string) {
    g_store.clear();
    return 0;
}
