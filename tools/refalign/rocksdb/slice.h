#pragma once
namespace rocksdb {
class Slice {};
}
