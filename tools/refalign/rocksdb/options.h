#pragma once
namespace rocksdb {
struct Options {
    bool create_if_missing = false;
};
}
